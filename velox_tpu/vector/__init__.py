from velox_tpu.vector.device import (  # noqa: F401
    DeviceBatch,
    DeviceColumn,
    Dictionary,
    default_capacity,
    from_arrow,
    to_arrow,
)
