"""Scene model: camera, materials, geometry descriptions, OBJ assets, SoA scene."""
