from msfno_tpu.models.film.wrapper import FilmWrapper  # noqa: F401
from msfno_tpu.models.film.gcn import GCNFilmGenerator  # noqa: F401
from msfno_tpu.models.film.vit import ViTFilmGenerator  # noqa: F401
from msfno_tpu.models.film.mae import ContextCast  # noqa: F401
