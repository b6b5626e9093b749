from .geotiff import GeoTiff, read_geotiff, read_geotiff_kwargs, write_geotiff  # noqa: F401
