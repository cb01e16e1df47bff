"""Local GUI for alphadia_tpu (reference role: the Electron app under
gui/ in MannLabs/alphadia — re-designed as a dependency-free local web
app served from the Python package itself)."""
