from velox_tpu.serializers.pages import (  # noqa: F401
    PageSerde, deserialize_page, serialize_page,
)
