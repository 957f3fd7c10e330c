"""Small host utilities (timers, logging) — Utilities.h parity."""

from toyrenderer_tpu.utils.timing import ScopedTimer, Timer
