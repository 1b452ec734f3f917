"""Generated protobuf messages (protoc --python_out over proto/llm.proto).
Regenerate: protoc --python_out=scalellm_tpu/serve/pb -I proto proto/llm.proto"""

from scalellm_tpu.serve.pb import llm_pb2

__all__ = ["llm_pb2"]
