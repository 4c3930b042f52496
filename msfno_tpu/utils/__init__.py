from msfno_tpu.utils.config import (  # noqa: F401
    SFNOConfig,
    FilmConfig,
    TrainConfig,
    tiny_sfno,
    to_json,
    from_json,
)
