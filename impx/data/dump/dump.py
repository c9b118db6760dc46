"""Eval-data dump CLI (reference dump/dump.py):

  python -m impx.data.dump.dump --config_path configs/yfcc_sp.yaml
"""
from __future__ import annotations

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--config_path", type=str, required=True)


def main(argv=None):
    import yaml

    from impx.data.dump import get_dumper

    args = parser.parse_args(argv)
    with open(args.config_path) as f:
        config = yaml.safe_load(f)
    dumper = get_dumper(config["data_name"], config)
    dumper.initialize()
    dumper.dump_feature()
    dumper.format_dump_data()


if __name__ == "__main__":
    main()
