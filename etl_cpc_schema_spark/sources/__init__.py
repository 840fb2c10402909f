"""Sources and sinks: file readers, zip/XML extraction, manifest control plane."""
