from velox_tpu.functions import registry  # noqa: F401
from velox_tpu.functions import scalar  # noqa: F401
from velox_tpu.functions import datetime  # noqa: F401
from velox_tpu.functions import misc  # noqa: F401
from velox_tpu.functions import complex  # noqa: F401
from velox_tpu.functions import sparksql  # noqa: F401
from velox_tpu.functions import strings_ext  # noqa: F401
# batch 3 aliases shared implementations registered above (regexp_like,
# json_extract, any_match, ...) — import last
from velox_tpu.functions import spark_batch3  # noqa: F401
from velox_tpu.functions import url_ip  # noqa: F401
# raw-string overrides WRAP already-registered names — import after all
# registrations so every entry gets the raw dispatch
from velox_tpu.functions import raw_strings  # noqa: F401
