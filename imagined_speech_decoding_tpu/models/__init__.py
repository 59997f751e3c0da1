"""Model zoo: FAST + baseline classifiers, all pure init/apply functions."""

from .fast import (  # noqa: F401
    attention_block_apply,
    attention_block_init,
    fast_apply,
    fast_batched_forward_head,
    fast_forward_head,
    fast_forward_transformer,
    fast_init,
    param_count,
)
from .heads import (  # noqa: F401
    HEAD_REGISTRY,
    ZoneEncoder,
    get_head,
    head_apply,
    head_init,
)
