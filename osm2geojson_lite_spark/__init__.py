"""PySpark-native OSM->GeoJSON engine (capabilities of tibetty/osm2geojson-lite).

See SURVEY.md for the blueprint; public surface:

    from osm2geojson_lite_spark import convert, Options, get_spark
"""

from .operators.convert import (
    CacheScope,
    MegaDocumentError,
    Options,
    build_features,
    convert,
)
from .operators.events import subscribe, xml_events
from .session import get_spark

__all__ = ["CacheScope", "MegaDocumentError", "Options", "build_features",
           "convert", "get_spark", "subscribe", "xml_events"]
