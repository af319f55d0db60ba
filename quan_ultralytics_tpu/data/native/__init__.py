from quan_ultralytics_tpu.data.native.native import letterbox_native, native_available

__all__ = ["letterbox_native", "native_available"]
