"""PySpark-native spatial estimation + tiling engine.

From-scratch reimplementation of the capabilities of
juliohm/GeoStatsSolvers.jl (reference at /root/reference, MIT) as
distributed DataFrame operators — see SURVEY.md for the blueprint.
"""

from .grid import CartesianGrid
from .distances import Anisotropic, Euclidean, Haversine
from .variogram import (
    ExponentialVariogram,
    GaussianVariogram,
    NuggetEffect,
    PowerVariogram,
    SphericalVariogram,
)

__all__ = [
    "CartesianGrid",
    "Anisotropic",
    "Euclidean",
    "Haversine",
    "GaussianVariogram",
    "SphericalVariogram",
    "ExponentialVariogram",
    "NuggetEffect",
    "PowerVariogram",
]
