from .loader import NativeLoader, build_native_library

__all__ = ["NativeLoader", "build_native_library"]
