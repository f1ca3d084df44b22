from tvqaplus_tpu.models.layers import (
    LinearWrapper,
    ConvLinear,
    DepthwiseSeparableConv,
    PositionEncoding,
    MultiHeadedAttention,
    EncoderBlock,
    StackedEncoder,
    mask_logits,
)
from tvqaplus_tpu.models.attention import (
    structured_attention,
    context_query_attention,
)
from tvqaplus_tpu.models.stage import STAGE, ModelConfig
