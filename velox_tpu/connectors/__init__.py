from velox_tpu.connectors.connector import (  # noqa: F401
    Connector, ConnectorSplit, DataSink, DataSource, get_connector,
    register_connector,
)
