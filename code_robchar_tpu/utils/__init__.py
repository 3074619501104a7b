"""Cache-file conventions, record protocol, timeouts."""

from code_robchar_tpu.utils.io import (
    noises_tag,
    mc_cache_name,
    load_json,
    dump_json,
)
from code_robchar_tpu.utils.record import RunRecord, TopControllers
from code_robchar_tpu.utils.timeout import Deadline, TimeoutError_

__all__ = [
    "noises_tag",
    "mc_cache_name",
    "load_json",
    "dump_json",
    "RunRecord",
    "TopControllers",
    "Deadline",
    "TimeoutError_",
]
