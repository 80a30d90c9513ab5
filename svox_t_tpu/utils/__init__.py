from .dataformat import DataFormat, LocalIndex
from .spec import (CameraSpec, DATA_SENTINEL, NDCConfig, Rays, RenderOptions,
                   TreeSpec, get_out_data_dim, make_tree_spec)
from .builders import tree_from_occupancy, tree_structure_from_occupancy
