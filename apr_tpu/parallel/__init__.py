from apr_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from apr_tpu.parallel.pipeline import BuilderTrainerPipeline

__all__ = ["make_mesh", "shard_batch", "replicate",
           "BuilderTrainerPipeline"]
