from . import fp
