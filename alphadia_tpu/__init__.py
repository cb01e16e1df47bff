"""alphadia-tpu: a TPU-native DIA proteomics search engine.

A from-scratch JAX/XLA/Pallas implementation of a peptide-centric
data-independent-acquisition search engine with the capabilities of
MannLabs/alphaDIA (reference: /root/reference). The hot path — XIC
extraction, candidate peak-group selection, and candidate scoring —
runs as batched JAX kernels on TPU; statistics (FDR, calibration,
quantification) run on host.
"""

__version__ = "0.1.0"
