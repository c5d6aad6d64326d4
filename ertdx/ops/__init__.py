from .attention import flash_attention, reference_attention  # noqa: F401
from .groupnorm import groupnorm_silu, reference_groupnorm_silu  # noqa: F401
