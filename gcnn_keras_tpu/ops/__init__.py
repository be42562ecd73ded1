from .segment import (
    segment_sum, segment_mean, segment_max, segment_min,
    segment_ops_by_name, segment_softmax,
)
from .activ import get_activation, shifted_softplus, leaky_softplus, swish
from .polynom import (
    spherical_bessel_jn, spherical_bessel_jn_all,
    legendre_pn, legendre_pn_all,
)
from .initializers import glorot_orthogonal
