// No-op archive stubs: the reference's cache persistence is either dead
// code (short reads) or unused in the differential test (no cache files).
#ifndef GAML_TPU_BOOST_ARCHIVE_STUB
#define GAML_TPU_BOOST_ARCHIVE_STUB
#include <iosfwd>

namespace boost {
namespace archive {

class binary_oarchive {
 public:
  explicit binary_oarchive(std::ostream&) {}
  template <class T>
  binary_oarchive& operator<<(const T&) { return *this; }
  template <class T>
  binary_oarchive& operator&(const T&) { return *this; }
};

class binary_iarchive {
 public:
  explicit binary_iarchive(std::istream&) {}
  template <class T>
  binary_iarchive& operator>>(T&) { return *this; }
  template <class T>
  binary_iarchive& operator&(T&) { return *this; }
};

}  // namespace archive
}  // namespace boost
#endif
