"""PROJJSON CRS definitions (public EPSG registry content).

GeoParquet 1.x stores the geometry column's CRS as a PROJJSON object
(reference: builder.rs:322, crs/mod.rs:31-38 embedding
epsg4301/4612/6668.json). These are the same three public EPSG
definitions, keyed by the engine CRS names."""

PROJJSON = {
    'Tokyo': {"$schema": "https://proj.org/schemas/v0.7/projjson.schema.json", "type": "GeographicCRS", "name": "Tokyo", "datum": {"type": "GeodeticReferenceFrame", "name": "Tokyo", "ellipsoid": {"name": "Bessel 1841", "semi_major_axis": 6377397.155, "inverse_flattening": 299.1528128}}, "coordinate_system": {"subtype": "ellipsoidal", "axis": [{"name": "Geodetic latitude", "abbreviation": "Lat", "direction": "north", "unit": "degree"}, {"name": "Geodetic longitude", "abbreviation": "Lon", "direction": "east", "unit": "degree"}]}, "scope": "Geodesy.", "area": "Japan - onshore; Democratic People's Republic of Korea (North Korea) - onshore; Republic of Korea (South Korea) - onshore.", "bbox": {"south_latitude": 20.37, "west_longitude": 122.83, "north_latitude": 45.54, "east_longitude": 154.05}, "id": {"authority": "EPSG", "code": 4301}},
    'JGD2000': {"$schema": "https://proj.org/schemas/v0.7/projjson.schema.json", "type": "GeographicCRS", "name": "JGD2000", "datum": {"type": "GeodeticReferenceFrame", "name": "Japanese Geodetic Datum 2000", "ellipsoid": {"name": "GRS 1980", "semi_major_axis": 6378137, "inverse_flattening": 298.257222101}}, "coordinate_system": {"subtype": "ellipsoidal", "axis": [{"name": "Geodetic latitude", "abbreviation": "Lat", "direction": "north", "unit": "degree"}, {"name": "Geodetic longitude", "abbreviation": "Lon", "direction": "east", "unit": "degree"}]}, "scope": "Horizontal component of 3D system.", "area": "Japan - onshore and offshore.", "bbox": {"south_latitude": 17.09, "west_longitude": 122.38, "north_latitude": 46.05, "east_longitude": 157.65}, "id": {"authority": "EPSG", "code": 4612}},
    'JGD2011': {"$schema": "https://proj.org/schemas/v0.7/projjson.schema.json", "type": "GeographicCRS", "name": "JGD2011", "datum": {"type": "GeodeticReferenceFrame", "name": "Japanese Geodetic Datum 2011", "ellipsoid": {"name": "GRS 1980", "semi_major_axis": 6378137, "inverse_flattening": 298.257222101}}, "coordinate_system": {"subtype": "ellipsoidal", "axis": [{"name": "Geodetic latitude", "abbreviation": "Lat", "direction": "north", "unit": "degree"}, {"name": "Geodetic longitude", "abbreviation": "Lon", "direction": "east", "unit": "degree"}]}, "scope": "Horizontal component of 3D system.", "area": "Japan - onshore and offshore.", "bbox": {"south_latitude": 17.09, "west_longitude": 122.38, "north_latitude": 46.05, "east_longitude": 157.65}, "id": {"authority": "EPSG", "code": 6668}},
}

# WGS84 output (GeoJSON / reprojected lanes): GeoParquet treats a
# null/omitted crs as OGC:CRS84 (WGS84 lon-lat), so no entry needed;
# writers fall back to None for unknown names.
