"""Logical planning relations: extent, tiling, cell index, spatial join."""
