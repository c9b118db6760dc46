from impx.data.dump.base import BaseDumper
from impx.data.dump.yfcc import YFCCDumper
from impx.data.dump.scannet import ScanNetDumper


def get_dumper(name: str, config: dict):
    return {"yfcc": YFCCDumper, "scannet": ScanNetDumper}[name](config)
