"""Data layer: body-model assets, dataset readers, augmentation, loaders."""
