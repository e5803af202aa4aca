// Replaces the reference's vendored Boost-serialization header for
// std::unordered_map (only serialization support lived there).
#ifndef GAML_TPU_UMAP_STUB
#define GAML_TPU_UMAP_STUB
#include <unordered_map>
#endif
