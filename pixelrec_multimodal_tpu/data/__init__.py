"""Data layer: offline preprocessing, splitting, tokenization, datasets,
and the device-resident feature store."""
