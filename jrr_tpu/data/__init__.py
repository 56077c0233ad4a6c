"""Host-side data pipeline: crops, intrinsics, dataset readers, fixtures."""
