from . import shapes, factorize
