"""Transformer building blocks: MHA, MLP, Block (flax.linen)."""

from liteattention_tpu.modules.mha import MHA, ParallelMHA
from liteattention_tpu.modules.mlp import GatedMlp, Mlp, ParallelMLP
from liteattention_tpu.modules.block import Block
from liteattention_tpu.modules.moe import MoEMlp

__all__ = ["MHA", "ParallelMHA", "Mlp", "GatedMlp", "ParallelMLP", "Block", "MoEMlp"]
