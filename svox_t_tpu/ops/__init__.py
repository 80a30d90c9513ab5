from . import grid, p2v, query, render, render_aux, reference_renderer, sh, traversal, warp
