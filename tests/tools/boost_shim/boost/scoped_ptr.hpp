// Test-only shim: boost::scoped_ptr over std::unique_ptr.
#ifndef TAXTK_SHIM_BOOST_SCOPED_PTR_HPP
#define TAXTK_SHIM_BOOST_SCOPED_PTR_HPP

#include <memory>

namespace boost {

template <class T>
class scoped_ptr {
    std::unique_ptr<T> p_;

public:
    scoped_ptr() = default;
    explicit scoped_ptr(T* p) : p_(p) {}
    void reset(T* p = nullptr) { p_.reset(p); }
    T* get() const { return p_.get(); }
    T& operator*() const { return *p_; }
    T* operator->() const { return p_.get(); }
    explicit operator bool() const { return static_cast<bool>(p_); }
    bool operator!() const { return !p_; }
};

}  // namespace boost

#endif
