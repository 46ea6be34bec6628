"""Render pipelines and parameter state (the reference's
`gaussian_renderer/` + `scene/gaussian_model.py` layer, redesigned as
pure-functional pytrees)."""
