from .bitreader import BitReader
from .bitwriter import BitWriter
from .nal import NalUnit, NalUnitType, split_annexb, ebsp_to_rbsp, rbsp_to_ebsp
