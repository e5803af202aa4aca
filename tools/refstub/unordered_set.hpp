#ifndef GAML_TPU_USET_STUB
#define GAML_TPU_USET_STUB
#include <unordered_set>
#endif
