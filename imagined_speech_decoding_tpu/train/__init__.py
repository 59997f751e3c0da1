"""Training layer: schedules, metrics, the scan-based fit engine,
checkpointing, CV/LOSO orchestration."""

from .schedule import cosine_scheduler, warmup_cosine_lr  # noqa: F401
from .metrics import (  # noqa: F401
    accuracy,
    confusion_matrix,
    cross_entropy,
    f1_from_confusion,
    macro_f1,
    precision_recall_from_confusion,
    ttest_vs_chance,
)
from .engine import (  # noqa: F401
    FitResult,
    ModelDef,
    evaluate,
    fit_many,
    make_fit,
    make_optimizer,
    predict,
    predict_proba,
)
from .sweep import (  # noqa: F401
    SweepReport,
    cv_sweep,
    hyper_grid,
    sweep_many,
)
from .checkpoint import (  # noqa: F401
    load_state_dict,
    restore_checkpoint,
    save_checkpoint,
    save_state_dict,
    select_model,
)
