from msfno_tpu.data.synthetic import Batch, gen_batch, synthetic_loader  # noqa: F401
from msfno_tpu.data.normalization import Normalizer, SSTNormalizer  # noqa: F401
