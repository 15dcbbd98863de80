"""Native runtime tier: C++ codecs, frame prefetcher, async writers."""

from emfusion_tpu.native.runtime import (  # noqa: F401
    AsyncWriter, NativePrefetcher, available, read_exr, read_png_gray16,
    read_png_rgb, write_exr, write_png_gray16, write_png_rgb,
)
