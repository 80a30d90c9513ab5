from .tree import N3Tree, WeightAccumulator
from .view import N3TreeView
from .renderer import VolumeRenderer
