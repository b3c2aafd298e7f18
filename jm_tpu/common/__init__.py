from .types import SPS, PPS, SliceHeader, SliceType, ChromaFormat
