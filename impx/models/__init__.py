from impx.models.config import MatcherConfig
from impx.models.gm import GM
from impx.models.dgnns import DGNNS
from impx.models.adgm import AdaGMN
