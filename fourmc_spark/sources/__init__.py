from .datasource import FourMcDataSource
from .protobuf import FourMcProtoDataSource
from .records import (
    read_4mc_csv,
    read_4mc_json,
    write_4mc_csv,
    write_4mc_json,
)

__all__ = [
    "FourMcDataSource",
    "FourMcProtoDataSource",
    "read_4mc_csv",
    "read_4mc_json",
    "write_4mc_csv",
    "write_4mc_json",
]
