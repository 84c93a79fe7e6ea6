from .kernels import FilterModel
