from quadrs_tpu.native.loader import NativeCapture, native_available

__all__ = ["NativeCapture", "native_available"]
