from alphadia_tpu.utils.misc import ceil_to_multiple, expand_path, get_isotope_columns

__all__ = ["ceil_to_multiple", "expand_path", "get_isotope_columns"]
