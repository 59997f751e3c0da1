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
from .api import make_fast_model  # noqa: F401
from .tsception import make_tsception_model, tsception_apply, tsception_init  # noqa: F401
from .eegnet import eegnet_apply, eegnet_init, make_eegnet_model  # noqa: F401
from .rnn import (  # noqa: F401
    bilstm_apply,
    bilstm_init,
    cnn_bilstm_apply,
    cnn_bilstm_init,
    make_cnn_bilstm_model,
)
from .mlp import make_mlp_model, mlp_apply, mlp_init  # noqa: F401
from .classical import CSPClassifierPipeline  # noqa: F401
