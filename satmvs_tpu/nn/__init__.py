"""NN building blocks (reference L3): conv blocks, FeatureNet, CostRegNet, RED."""

from .blocks import ConvBlock, ConvGRUCell, DeconvBlock, DeconvFuse  # noqa: F401
from .costreg import CostRegNet  # noqa: F401
from .featurenet import FeatureNet  # noqa: F401
from .red import REDRegularizer, REDStep, init_red_states  # noqa: F401
