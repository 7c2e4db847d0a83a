from .renderer import (
    render_state,
    render_state_per_agent,
    save_gif,
    tile_images,
)

__all__ = ["render_state", "render_state_per_agent", "save_gif", "tile_images"]
