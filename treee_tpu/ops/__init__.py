from . import morton, octree, eigen, neighbors  # noqa: F401
