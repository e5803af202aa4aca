// Minimal boost::split / is_any_of stub so the reference compiles without
// Boost (differential-testing harness only; see tools/build_reference.sh).
#ifndef GAML_TPU_BOOST_STRING_STUB
#define GAML_TPU_BOOST_STRING_STUB
#include <string>
#include <vector>

namespace boost {

struct is_any_of_pred {
  std::string chars;
  bool operator()(char c) const { return chars.find(c) != std::string::npos; }
};

inline is_any_of_pred is_any_of(const std::string& s) { return {s}; }

enum token_compress_mode_type { token_compress_off = 0, token_compress_on = 1 };

template <class Seq>
inline void split(Seq& out, const std::string& s, const is_any_of_pred& pred,
                  token_compress_mode_type compress = token_compress_off) {
  out.clear();
  std::string cur;
  for (char c : s) {
    if (pred(c)) {
      if (!cur.empty() || compress == token_compress_off) out.push_back(cur);
      cur.clear();
    } else {
      cur += c;
    }
  }
  out.push_back(cur);
}

}  // namespace boost
#endif
