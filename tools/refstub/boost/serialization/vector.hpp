// Empty stub — serialization templates are never instantiated with the
// no-op archives.
#ifndef GAML_TPU_BOOST_SER_VECTOR_STUB
#define GAML_TPU_BOOST_SER_VECTOR_STUB
#endif
