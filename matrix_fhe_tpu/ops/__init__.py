from . import modmath, modmatmul  # noqa: F401
