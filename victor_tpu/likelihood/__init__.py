from .core import (chi_squared, log_likelihood, multipole_datavector,
                   interpolated_covariance, interpolated_precision)

__all__ = ['chi_squared', 'log_likelihood', 'multipole_datavector',
           'interpolated_covariance', 'interpolated_precision']
