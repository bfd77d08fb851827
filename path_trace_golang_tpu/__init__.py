"""path_trace_golang_tpu — a TPU-native Monte-Carlo path-tracing framework.

Ground-up JAX/XLA/Pallas re-design of the Go + GLSL reference renderer
(MarkJulian19/path_trace_golang): same scene format, same feature set, same
CLI, built for TPU from the start — SPMD lane batches instead of goroutine
tiles, masked wavefront bounce loops instead of SIMT warps, counter-seeded
deterministic RNG instead of time seeds, and `jax.sharding` meshes instead
of a single GL context.

Public facade mirrors ``internal/engine``:

* :func:`render_scene` / :func:`render_into` / :class:`Renderer`
* :func:`render_settings_for_mode` — preview / final presets
* :func:`set_backend` / :func:`get_backend` — physics-contract switch
  ("gpu" = the rich shader contract, "cpu" = the simple Go-core contract)
* :func:`save_png`
* ``scene`` subpackage — JSON scene model and IO
"""

from .utils.config import init_compile_cache as _init_compile_cache

_init_compile_cache()  # persistent XLA cache on by default (see docstring)

from .io_png import save_png
from .render import (
    BACKEND_CPU,
    BACKEND_GPU,
    RenderConfig,
    Renderer,
    RenderStats,
    get_backend,
    render_into,
    render_scene,
    render_settings_for_mode,
    set_backend,
)
from .scene.model import RenderSettings, Scene
from .soa import ScenePack, pack_scene

__version__ = "0.1.0"

__all__ = [
    "Renderer",
    "RenderConfig",
    "RenderStats",
    "RenderSettings",
    "Scene",
    "ScenePack",
    "pack_scene",
    "render_into",
    "render_scene",
    "render_settings_for_mode",
    "save_png",
    "set_backend",
    "get_backend",
    "BACKEND_CPU",
    "BACKEND_GPU",
    "__version__",
]
