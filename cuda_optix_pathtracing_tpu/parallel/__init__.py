"""Device-mesh parallelism: shard rays/pixels over chips, replicate scene.

Net-new vs the reference (single-GPU, SURVEY.md §2.5): the scaling axis is
the ray/sample dimension — the film is sharded across a 1D mesh, the scene
and material tables are replicated, and gradient reductions ride ICI via
``psum`` inside ``shard_map``.
"""

from .render import make_mesh, render_sharded, train_step_sharded  # noqa: F401
