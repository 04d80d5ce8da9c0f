from .mesh import make_mesh, shard_batch, replicate
from .runner import CorpusRunner, wash_corpus

__all__ = ["make_mesh", "shard_batch", "replicate", "CorpusRunner", "wash_corpus"]
