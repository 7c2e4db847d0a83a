from .renderer import render_state, save_gif

__all__ = ["render_state", "save_gif"]
