from msfno_tpu.inference.rollout import (  # noqa: F401
    RolloutConfig,
    make_step_fn,
    rollout,
    scan_rollout,
)
from msfno_tpu.inference.evaluate import (  # noqa: F401
    SkillReport,
    evaluate_rollout,
    hourly_climatology,
)
