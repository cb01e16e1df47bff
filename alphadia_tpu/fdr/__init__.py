from alphadia_tpu.fdr.fdr import perform_fdr
from alphadia_tpu.fdr.fdrx import TargetDecoyFDR
from alphadia_tpu.fdr.qvalues import get_q_values, keep_best

__all__ = ["TargetDecoyFDR", "get_q_values", "keep_best", "perform_fdr"]
