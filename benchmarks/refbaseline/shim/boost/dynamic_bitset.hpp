// Shim: expose boost::dynamic_bitset via libstdc++'s std::tr2::dynamic_bitset
// (the tr2 class is modeled on boost's).  tr2 lacks `intersects` and its
// is_subset_of/is_proper_subset_of are not const-correct in GCC 12, so those
// three are reimplemented here on top of the public API.
#pragma once
#include <tr2/dynamic_bitset>
#include <memory>
namespace boost {
template <typename _WordT = unsigned long long,
          typename _Alloc = std::allocator<_WordT>>
class dynamic_bitset : public std::tr2::dynamic_bitset<_WordT, _Alloc> {
  using base = std::tr2::dynamic_bitset<_WordT, _Alloc>;
 public:
  using base::base;
  dynamic_bitset() = default;
  dynamic_bitset(const base& b) : base(b) {}
  dynamic_bitset(base&& b) : base(std::move(b)) {}
  using size_type = typename base::size_type;
  static const size_type npos = base::npos;
  // GCC-12 tr2 returns size() (not npos) when no further bit is set,
  // which infinite-loops boost-style `for (p = find_first(); p != npos;
  // p = find_next(p))` scans — remap the sentinel.
  size_type find_first() const {
    size_type p = base::find_first();
    return p >= this->size() ? npos : p;
  }
  size_type find_next(size_type prev) const {
    size_type p = base::find_next(prev);
    return p >= this->size() ? npos : p;
  }
  bool intersects(const dynamic_bitset& o) const {
    base tmp = *this;
    tmp &= o;
    return tmp.any();
  }
  bool is_subset_of(const dynamic_bitset& o) const {
    base tmp = *this;
    tmp -= o;
    return !tmp.any();
  }
  bool is_proper_subset_of(const dynamic_bitset& o) const {
    return is_subset_of(o) && !(static_cast<const base&>(*this) ==
                                static_cast<const base&>(o));
  }
};
}  // namespace boost
