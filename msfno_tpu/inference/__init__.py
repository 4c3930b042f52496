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
from msfno_tpu.inference.io import (  # noqa: F401
    get_input,
    get_output,
    available_inputs,
    available_outputs,
)
from msfno_tpu.inference.forecast_writer import ForecastWriter  # noqa: F401
from msfno_tpu.inference.eval_checkpoints import (  # noqa: F401
    evaluate_checkpoints,
    select_checkpoints,
)
