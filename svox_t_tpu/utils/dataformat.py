"""Data-format mini-DSL and local-index marker.

Capability parity with the reference `svox_t/helpers.py:378-420`
(`DataFormat` string parser "RGBA"/"SH{n}"/"SG{n}"/"ASG{n}" and
`LocalIndex`), re-implemented for the TPU-native framework.
"""

from __future__ import annotations


class LocalIndex:
    """Marker to query an N3Tree with 'local' coordinates in [0, 1]^3.

    Use ``tree[LocalIndex(points)]`` where ``points`` is (N, 3).
    (parity: svox_t/helpers.py:378-384)
    """

    def __init__(self, val):
        self.val = val


class DataFormat:
    """Parses the leaf-data format string.

    Formats (parity: svox_t/helpers.py:386-420):
      - ``"RGBA"`` (or any unrecognized string): raw channels + sigma.
      - ``"SH{n}"``: spherical harmonics with n basis functions per channel.
      - ``"SG{n}"``: spherical gaussians.
      - ``"ASG{n}"``: anisotropic spherical gaussians.
    """

    RGBA = 0
    SH = 1
    SG = 2
    ASG = 3

    def __init__(self, txt: str):
        nonalph_idx = [c.isalpha() for c in txt]
        if False in nonalph_idx:
            nonalph_idx = nonalph_idx.index(False)
            self.basis_dim = int(txt[nonalph_idx:])
            format_type = txt[:nonalph_idx]
            if format_type == "SH":
                self.format = DataFormat.SH
            elif format_type == "SG":
                self.format = DataFormat.SG
            elif format_type == "ASG":
                self.format = DataFormat.ASG
            else:
                self.format = DataFormat.RGBA
        else:
            self.format = DataFormat.RGBA
            self.basis_dim = -1

    def __repr__(self):
        if self.format == DataFormat.SH:
            r = "SH"
        elif self.format == DataFormat.SG:
            r = "SG"
        elif self.format == DataFormat.ASG:
            r = "ASG"
        else:
            r = "RGBA"
        if self.basis_dim >= 0:
            r += str(self.basis_dim)
        return r

    def __eq__(self, other):
        if not isinstance(other, DataFormat):
            return NotImplemented
        return self.format == other.format and self.basis_dim == other.basis_dim

    def __hash__(self):
        return hash((self.format, self.basis_dim))
