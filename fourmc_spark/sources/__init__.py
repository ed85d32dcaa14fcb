from .datasource import FourMcDataSource

__all__ = ["FourMcDataSource"]
