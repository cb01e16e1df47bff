from alphadia_tpu.library.speclib import SpecLibBase, SpecLibFlat

__all__ = ["SpecLibBase", "SpecLibFlat"]
