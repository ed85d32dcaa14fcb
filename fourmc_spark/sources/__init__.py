from .datasource import FourMcDataSource
from .protobuf import FourMcProtoDataSource

__all__ = ["FourMcDataSource", "FourMcProtoDataSource"]
