"""Dataset tooling: converters into the packed RAW container
(the reference's L9 layer — thirdparty/scene2raw.cpp, oni2raw.cpp)."""
