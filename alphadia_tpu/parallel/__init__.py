from alphadia_tpu.parallel.mesh import make_mesh, shard_batch_arrays

__all__ = ["make_mesh", "shard_batch_arrays"]
