"""Reference-semantics float64 emulator (validation oracle).

See emulator.py.  Not part of the legkilo_tpu package: this is the
measuring stick the TPU framework is validated against, deliberately
implemented in the reference's own style (pointer octrees, per-point
recursion, double precision) rather than the TPU-native design.
"""

from .emulator import EmuParams, RefKilo, run_emulator  # noqa: F401
