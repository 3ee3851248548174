// Test-only shim: binner.cpp only names
// boost::ptr_vector<ptr_list<T>>::size_type for an option value.
#ifndef TAXTK_SHIM_BOOST_PTR_VECTOR_HPP
#define TAXTK_SHIM_BOOST_PTR_VECTOR_HPP

#include <cstddef>
#include <memory>
#include <vector>

namespace boost {

template <class T>
class ptr_vector {
    std::vector<std::unique_ptr<T>> v_;

public:
    using size_type = std::size_t;
    void push_back(T* p) { v_.emplace_back(p); }
    T& operator[](size_type i) { return *v_[i]; }
    size_type size() const { return v_.size(); }
    bool empty() const { return v_.empty(); }
};

}  // namespace boost

#endif
