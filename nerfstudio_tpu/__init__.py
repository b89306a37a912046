"""nerfstudio_tpu: a TPU-native neural rendering framework (nerfstudio-class).

JAX/XLA/Pallas/pjit compute path; same capability surface as
nerfstudio-project/nerfstudio (see SURVEY.md for the blueprint).
"""

__version__ = "0.1.0"
