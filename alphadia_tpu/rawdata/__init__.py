from alphadia_tpu.rawdata.dia_cycle import determine_dia_cycle
from alphadia_tpu.rawdata.diadata import DiaData
from alphadia_tpu.rawdata.source import SpectrumData, load_raw_file

__all__ = ["DiaData", "SpectrumData", "determine_dia_cycle", "load_raw_file"]
