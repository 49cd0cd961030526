from .synthetic import brain_phantom_pair, sphere, sphere_pair, svf_pair

__all__ = ["sphere", "sphere_pair", "svf_pair", "brain_phantom_pair"]
