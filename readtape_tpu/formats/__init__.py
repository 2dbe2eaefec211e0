from .tbin import TbinHeader, read_tbin, write_tbin
from .simh import TapWriter, read_tap
from .parms import Parms, ParmSets, builtin_parmsets

__all__ = [
    "TbinHeader", "read_tbin", "write_tbin",
    "TapWriter", "read_tap",
    "Parms", "ParmSets", "builtin_parmsets",
]
