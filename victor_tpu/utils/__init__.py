from .logging import get_logger
from .multipoles import multipoles_from_fn, fn_from_multipoles

__all__ = ['get_logger', 'multipoles_from_fn', 'fn_from_multipoles']
