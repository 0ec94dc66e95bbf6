"""Model layer: body model, backbones, regressors, heads, full WHMR graph."""
