from .renderer import render_state, save_gif, tile_images

__all__ = ["render_state", "save_gif", "tile_images"]
