from .field import Scalar, inner_product  # noqa: F401
from .curve import StarkPoint, random_point  # noqa: F401
