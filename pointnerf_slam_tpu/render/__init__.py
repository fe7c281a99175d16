from .renderer import (
    RenderConfig,
    eval_points,
    render_rays,
    render_img,
    regulation,
)
