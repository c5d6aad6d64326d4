from .attention import (flash_attention, flash_cross_attention,  # noqa: F401
                        reference_attention)
from .conv import gn_silu_conv3, reference_gn_silu_conv3  # noqa: F401
from .ensemble_attn import (block_self_attention,  # noqa: F401
                            folded_cross_attention)
from .groupnorm import groupnorm_silu, reference_groupnorm_silu  # noqa: F401
