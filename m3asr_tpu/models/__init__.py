from m3asr_tpu.models import aed, conformer, dfsmn, moe_conformer  # noqa: F401
from m3asr_tpu.models.registry import get_family, ModelFamily  # noqa: F401
