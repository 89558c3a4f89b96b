"""Model library: Wan video DiT (flagship), GPT family, BERT, ViT."""

from liteattention_tpu.models.bert import (
    BertConfig,
    BertForPreTraining,
    BertModel,
)
from liteattention_tpu.models.configs import (
    bigcode_config,
    falcon_config,
    gpt2_config,
    gpt_neox_config,
    gptj_config,
    llama_config,
    opt_config,
)
from liteattention_tpu.models.gpt import GPTConfig, GPTLMHeadModel, GPTModel
from liteattention_tpu.models.vit import ViTConfig, VisionTransformer
from liteattention_tpu.models.wan import (
    WanConfig,
    WanModel,
    init_skip_states,
)

__all__ = [
    "WanConfig",
    "WanModel",
    "init_skip_states",
    "GPTConfig",
    "GPTModel",
    "GPTLMHeadModel",
    "BertConfig",
    "BertModel",
    "BertForPreTraining",
    "ViTConfig",
    "VisionTransformer",
    "gpt2_config",
    "opt_config",
    "gptj_config",
    "gpt_neox_config",
    "falcon_config",
    "llama_config",
    "bigcode_config",
]
