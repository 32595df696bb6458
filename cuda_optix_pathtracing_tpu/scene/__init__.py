"""Scene layer: flat SoA scene model, procedural shapes, parsers."""

from .types import Scene, scene_from_host  # noqa: F401
from .procedural import cornell_box  # noqa: F401
