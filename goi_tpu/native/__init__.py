from goi_tpu.native.loader import (native_available,
                                   read_points3d_binary_native,
                                   read_images_binary_native)

__all__ = ["native_available", "read_points3d_binary_native",
           "read_images_binary_native"]
