from trustedai_cl_vae_ad_tpu.viz.plots import (  # noqa: F401
    histogram,
    image_grid,
    jet_heatmap,
    overlay_heatmap,
    save_rgb,
)
