from .quantize import quantize_median_cut
