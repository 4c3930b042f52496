from msfno_tpu.models.afno.afnonet import (  # noqa: F401
    AFNO2D,
    AFNOBlock,
    AFNONet,
    PrecipNet,
    unlog_tp,
)
