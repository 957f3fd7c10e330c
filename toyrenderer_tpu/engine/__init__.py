"""Engine layer: camera/View, frame pipeline, carry state, headless loop."""

from toyrenderer_tpu.engine.view import View
from toyrenderer_tpu.engine.frame import (
    RenderSettings, FrameCarry, render_frame, init_carry)
